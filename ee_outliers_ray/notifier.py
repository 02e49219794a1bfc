"""Notification sink (SURVEY S9/ST4, reference
/root/reference/app/helpers/notifier.py:37-55): a single sink actor with
a bounded seen-summary deque (max_cache_ignore=1000,
defaults/outliers.conf:93) deduplicating notifications.

The SMTP transport is environment-dependent; the default transport here
collects notifications in the actor (inspectable via ``drain``), and a
callable transport can be injected for real delivery.  Consume any
outlier Dataset with ``notify_outliers`` — rows stream to the one actor,
preserving the reference's global-dedup semantics.
"""

from __future__ import annotations

from collections import deque

import ray


@ray.remote
class NotifierActor:
    def __init__(self, max_cache_ignore: int = 1000, transport=None):
        self.seen = deque(maxlen=max_cache_ignore)
        self.transport = transport
        self.sent: list[dict] = []

    def notify(self, outliers: list[dict]) -> int:
        n = 0
        for o in outliers:
            summary = o.get("summary", "")
            if summary in self.seen:
                continue
            self.seen.append(summary)
            if self.transport is not None:
                self.transport(o)
            else:
                self.sent.append(o)
            n += 1
        return n

    def drain(self) -> list[dict]:
        out, self.sent = self.sent, []
        return out


def notify_outliers(ds, notifier, summary_col: str = "summary",
                    batch_size: int = 1000) -> int:
    """Stream an outlier Dataset into the notifier actor; returns the
    number of non-deduplicated notifications sent."""
    total = 0
    for batch in ds.iter_batches(batch_size=batch_size, batch_format="pandas"):
        rows = batch.to_dict("records")
        for r in rows:
            r["summary"] = str(r.get(summary_col, ""))
        total += ray.get(notifier.notify.remote(rows))
    return total
