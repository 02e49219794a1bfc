"""Notification sink (SURVEY S9/ST4, reference
/root/reference/app/helpers/notifier.py:37-74): a single sink actor with
a bounded seen-summary deque (max_cache_ignore=1000,
defaults/outliers.conf:93) deduplicating notifications.

Email assembly follows the reference: subject = "Eagle Eye - outlier
alert: <summary>"; body = the key -> value outlier block + the raw
event JSON (notifier.py:48-55, outlier.py:54-63); the message is a
MIMEText with Subject/From/To headers (notifier.py:62-66).  Actual SMTP
delivery is environment-dependent, so the wire call is the injectable
``transport`` (``smtp_transport`` builds the real SMTP_SSL one from
config); the default transport collects messages in the actor
(inspectable via ``drain``).  Consume any outlier Dataset with
``notify_outliers`` — rows stream to the one actor, preserving the
reference's global-dedup semantics.
"""

from __future__ import annotations

import json
from collections import deque
from email.mime.text import MIMEText

import ray


def build_email(outlier: dict, *, from_addr: str = "",
                to_addr: str = "") -> MIMEText:
    """Assemble the notification email exactly as the reference does
    (notifier.py:48-55 + outlier.py:54-63): outlier fields as a
    ``key\\t -> value`` block, then the raw event JSON."""
    summary = str(outlier.get("summary", ""))
    doc = outlier.get("doc", {})
    fields = {k: v for k, v in outlier.items() if k != "doc"}
    block = "\n=======\noutlier\n=======\n"
    for k, v in fields.items():
        block += f"{k}\t -> {v}\n"
    body = (block + "\n\n\n========RAW EVENT========\n\n\n\n"
            + json.dumps(doc, sort_keys=True, indent=4, default=str))
    msg = MIMEText(body)
    msg["Subject"] = "Eagle Eye - outlier alert: " + summary
    msg["From"] = from_addr
    msg["To"] = to_addr
    return msg


def smtp_transport(*, smtp_server: str, smtp_port: int, smtp_user: str,
                   smtp_pass: str, notification_email: str):
    """Real SMTP_SSL delivery callable (reference notifier.py:62-71),
    built lazily per send; errors are swallowed like the reference
    (send failures must not kill the analysis run)."""

    def send(outlier: dict) -> None:
        import smtplib

        try:
            msg = build_email(outlier, from_addr=smtp_user,
                              to_addr=notification_email)
            con = smtplib.SMTP_SSL(smtp_server, smtp_port)
            con.login(smtp_user, smtp_pass)
            con.send_message(msg)
            con.quit()
        except Exception:  # noqa: BLE001 — reference logs and continues
            pass

    return send


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
