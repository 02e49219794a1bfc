"""Whitelist matcher — compiled once, broadcast to workers (the reference's
per-process singleton config, /root/reference/app/helpers/settings.py:87-140,
applied in /root/reference/app/helpers/outlier.py:66-110).

Contract mirrored from ``Outlier.is_whitelisted_doc``:
- a *literal* entry is a set of strings; it matches a document when every
  element of the entry appears (stripped, stringified) among the
  document's values;
- a *regexp* entry is a list of patterns; it matches when every pattern
  matches at least one document value.

In the Ray pipelines the "document values" for group-level evaluation are
the stringified (aggregator, target, summary) of the candidate outlier —
identical for every doc sharing the pair, which is exactly why the
reference's per-doc removal always removes whole pairs at once.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass
class Whitelist:
    literals: list[frozenset[str]] = field(default_factory=list)
    regexps: list[list[re.Pattern]] = field(default_factory=list)

    @classmethod
    def from_config(cls, literal_entries: list[str] | None = None,
                    regexp_entries: list[str] | None = None) -> "Whitelist":
        """Entries as in the reference ini: comma-separated values per line
        (settings.py:105-140)."""
        lits = [frozenset(v.strip() for v in e.split(","))
                for e in (literal_entries or [])]
        regs = [[re.compile(v.strip(), re.IGNORECASE) for v in e.split(",")]
                for e in (regexp_entries or [])]
        return cls(lits, regs)

    @property
    def empty(self) -> bool:
        return not self.literals and not self.regexps

    def matches(self, values: set[str]) -> bool:
        values = {str(v).strip() for v in values}
        for entry in self.literals:
            if entry.issubset(values):
                return True
        for patterns in self.regexps:
            if all(any(p.match(v) for v in values) for p in patterns):
                return True
        return False
