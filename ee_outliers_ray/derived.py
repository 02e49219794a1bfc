"""Derived fields (Grok-pattern extraction) + asset extraction as
stateful actor-pool stages.

Reference: ``extract_derived_fields``
(/root/reference/app/helpers/es.py:489-517) compiles Grok patterns once
per process (cache at es.py:41,502-506) and adds new fields from a source
field before analysis, so derived fields can serve as aggregators /
targets (defaults/outliers.conf:146-150);
``extract_outlier_asset_information``
(/root/reference/app/helpers/utils.py:130-155) pulls configured asset
fields into "type: value" strings.

Here: a minimal Grok -> regex compiler (the pygrok dependency is not in
this environment) supporting the pattern set the reference's defaults
use, compiled ONCE per actor in ``__init__`` and applied vectorized with
``pyarrow.compute.extract_regex`` per batch.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# the standard logstash/pygrok core pattern library (public grok-patterns
# set), expressed with nested %{NAME} references resolved recursively by
# grok_to_regex.  Covers what the reference's configs can name through
# pygrok (es.py:489-517); custom definitions extend it per use-case file
# via the [grok_patterns] section.
GROK_PATTERNS = {
    # numbers
    "INT": r"(?:[+-]?(?:[0-9]+))",
    "BASE10NUM": r"(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?)|\.[0-9]+)",
    "NUMBER": r"(?:%{BASE10NUM})",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "POSINT": r"\b(?:[1-9][0-9]*)\b",
    "NONNEGINT": r"\b(?:[0-9]+)\b",
    # words / strings
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"(?:\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*'|`(?:[^`\\]|\\.)*`)",
    "QS": r"%{QUOTEDSTRING}",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    # network
    "MAC": r"(?:[A-Fa-f0-9]{2}[:-]){5}[A-Fa-f0-9]{2}",
    "IPV4": r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
            r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
    "IPV6": r"(?:[0-9A-Fa-f]{1,4}:){1,7}(?::|[0-9A-Fa-f]{1,4})"
            r"(?::%{IPV4})?",
    "IP": r"(?:%{IPV6}|%{IPV4})",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "EMAILLOCALPART": r"[a-zA-Z][a-zA-Z0-9_.+-=:]+",
    "EMAILADDRESS": r"%{EMAILLOCALPART}@%{HOSTNAME}",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})"
                r"(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    # paths
    "UNIXPATH": r"(?:/[\w_%!$@:.,+~-]+)+",
    "WINPATH": r"(?:[A-Za-z]+:|\\)(?:\\[^\\?*]*)+",
    "PATH": r"(?:%{UNIXPATH}|%{WINPATH})",
    "TTY": r"(?:/dev/(?:pts|tty(?:[pq])?)(?:\w+)?/?(?:[0-9]+))",
    # URIs
    "URIPROTO": r"[A-Za-z][A-Za-z0-9+.-]+",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\--]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
    "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?"
           r"(?:%{URIHOST})?(?:%{URIPATHPARAM})?",
    # dates / times
    "YEAR": r"(?:\d\d){1,2}",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHNUM2": r"(?:0[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "MONTH": r"\b(?:[Jj]an(?:uary|uar)?|[Ff]eb(?:ruary|ruar)?|"
             r"[Mm](?:a|ä)?r(?:ch|z)?|[Aa]pr(?:il)?|[Mm]a(?:y|i)?|"
             r"[Jj]un(?:e|i)?|[Jj]ul(?:y|i)?|[Aa]ug(?:ust)?|"
             r"[Ss]ep(?:tember)?|[Oo](?:c|k)?t(?:ober)?|"
             r"[Nn]ov(?:ember)?|[Dd]e(?:c|z)(?:ember)?)\b",
    "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|"
           r"Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5][0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"(?!<[0-9])%{HOUR}:%{MINUTE}(?::%{SECOND})(?![0-9])",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "DATE": r"%{DATE_US}|%{DATE_EU}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "ISO8601_SECOND": r"(?:%{SECOND}|60)",
    "TIMESTAMP_ISO8601": r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?"
                         r"%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?",
    "DATESTAMP": r"%{DATE}[- ]%{TIME}",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    # misc
    "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|"
                r"[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn(?:ing)?|"
                r"WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|[Cc]rit(?:ical)?|"
                r"CRIT(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|"
                r"EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    "SYSLOGPROG": r"%{WORD}(?:\[%{POSINT}\])?",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+))?\}")
_MAX_DEPTH = 16


def grok_to_regex(pattern: str,
                  custom_patterns: dict[str, str] | None = None) -> str:
    """Compile a Grok pattern to a python/RE2 regex with named groups.
    Nested %{NAME} references resolve recursively (depth-bounded);
    ``custom_patterns`` (name -> grok-or-regex body) extend/override the
    built-in library, mirroring pygrok's custom pattern dirs."""
    table = dict(GROK_PATTERNS)
    if custom_patterns:
        table.update(custom_patterns)

    def expand(p: str, depth: int) -> str:
        if depth > _MAX_DEPTH:
            raise ValueError("grok pattern nesting too deep (cycle?)")

        def sub(m: re.Match) -> str:
            name, alias = m.group(1), m.group(2)
            body = table.get(name)
            if body is None:
                raise KeyError(f"unknown grok pattern %{{{name}}}")
            body = expand(body, depth + 1)
            return f"(?P<{alias}>{body})" if alias else f"(?:{body})"

        return _GROK_REF.sub(sub, p)

    return expand(pattern, 0)


class DerivedFields:
    """Actor-pool stage: add ``derived_<name>`` columns extracted from
    source columns via Grok patterns (compiled once per actor)."""

    def __init__(self, field_patterns: dict[str, str],
                 prefix: str = "derived_",
                 custom_patterns: dict[str, str] | None = None):
        self.compiled = {
            field: grok_to_regex(pat, custom_patterns)
            for field, pat in field_patterns.items()
        }
        self.group_names = {
            field: list(re.compile(rx).groupindex)
            for field, rx in self.compiled.items()
        }
        self.prefix = prefix

    def __call__(self, batch: pa.Table) -> pa.Table:
        for field, rx in self.compiled.items():
            if field not in batch.column_names:
                continue
            col = pc.cast(batch[field], pa.string())
            extracted = pc.extract_regex(col, rx)
            for gname in self.group_names[field]:
                vals = pc.struct_field(extracted, gname)
                batch = batch.append_column(self.prefix + gname, vals)
        return batch


def extract_asset_information(batch: pa.Table, asset_fields: dict[str, str],
                              out_col: str = "assets") -> pa.Table:
    """M15: configured asset columns -> list of "type: value" strings per
    row (utils.py:130-155; [assets] section, defaults/outliers.conf:48-80).
    Vectorized per column; null values skipped."""
    n = batch.num_rows
    parts: list[list[str]] = [[] for _ in range(n)]
    for col_name, asset_type in asset_fields.items():
        if col_name not in batch.column_names:
            continue
        vals = pc.cast(batch[col_name], pa.string()).to_pylist()
        for i, v in enumerate(vals):
            if v is not None and v != "":
                parts[i].append(f"{asset_type}: {v}")
    return batch.append_column(
        out_col, pa.array(parts, type=pa.list_(pa.string())))
