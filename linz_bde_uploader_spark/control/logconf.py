"""``log_settings`` parity: the reference configures Log4perl from a
conf heredoc (bin/linz_bde_uploader.pl:184-213;
conf/linz_bde_uploader.conf:311-346) with three operationally
load-bearing appender classes:

- ``Log::Log4perl::Appender::File``  -> file log (t/linz_bde_uploader.t:132-141)
- ``Log::Log4perl::Appender::Screen`` -> stderr
- ``Log::Dispatch::Email::MailSender`` -> buffered email flushed at
  job end when any record reaches ``min_level`` (the reference's
  error-reporting channel, conf:317-328)

This module parses the same block into Python ``logging`` handlers.
Email delivery is pluggable: ``apply_log_settings(mailer=...)`` takes
a callable receiving ``{to, sender, subject, smtp, body}``; the
default records the would-be message on the handler (``.sent``) so
air-gapped runs and tests observe delivery without a network. An
empty block leaves a stderr handler in place (reference issue #103
behavior: empty log_settings still logs to stderr,
t/linz_bde_uploader.t:111-128).
"""

from __future__ import annotations

import logging
import re
import sys

_LEVELS = {
    "TRACE": logging.DEBUG, "DEBUG": logging.DEBUG, "INFO": logging.INFO,
    "WARN": logging.WARNING, "WARNING": logging.WARNING,
    "ERROR": logging.ERROR, "FATAL": logging.CRITICAL,
}


def parse_log_settings(block: str) -> dict:
    """Parse a log4perl-ish block into
    ``{"level": int, "appenders": {name: {"class": ..., opts...}}}``.
    Handles ``\\`` line continuations and ``#`` comments; only the
    root-logger line and ``log4perl.appender.*`` keys are read."""
    # join continuation lines first (conf:322-326 wrap values)
    joined: list[str] = []
    for raw in block.splitlines():
        if joined and joined[-1].endswith("\\"):
            joined[-1] = joined[-1][:-1].rstrip() + " " + raw.strip()
        else:
            joined.append(raw.rstrip())
    level = logging.INFO
    names: list[str] = []
    appenders: dict[str, dict[str, str]] = {}
    root_seen = False
    for line in joined:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = re.match(r"log4perl\.(?:root)?[Ll]ogger\s*=\s*(.+)$", line)
        if m:
            parts = [p.strip() for p in m.group(1).split(",")]
            level = _LEVELS.get(parts[0].upper(), logging.INFO)
            names = [p for p in parts[1:] if p]
            root_seen = True
            continue
        m = re.match(r"log4perl\.appender\.(\w+)(?:\.([\w.]+))?\s*=\s*(.*)$",
                     line)
        if m:
            name, opt, val = m.group(1), m.group(2), m.group(3).strip()
            appenders.setdefault(name, {})
            if opt is None:
                appenders[name]["class"] = val
            else:
                appenders[name][opt] = val
    return {"level": level, "root_seen": root_seen,
            "appenders": {n: appenders.get(n, {}) for n in names}}


class BufferedEmailHandler(logging.Handler):
    """Analog of Log::Dispatch::Email::MailSender with buffered=1:
    records buffer in memory; ``flush_email()`` (called at job end /
    logging shutdown) delivers ONE message if any record reached
    ``min_level``. Delivery goes through the injected ``mailer``
    callable; the default stores the message on ``self.sent``."""

    def __init__(self, min_level: int, to: str, sender: str, subject: str,
                 smtp: str, mailer=None):
        super().__init__(level=logging.DEBUG)
        self.min_level = min_level
        self.to, self.sender, self.subject, self.smtp = (
            to, sender, subject, smtp)
        self.mailer = mailer
        self.buffer: list[logging.LogRecord] = []
        self.triggered = False
        self.sent: list[dict] = []

    def emit(self, record: logging.LogRecord) -> None:
        self.buffer.append(record)
        if record.levelno >= self.min_level:
            self.triggered = True

    def flush_email(self) -> None:
        if not self.triggered or not self.buffer:
            return
        body = "\n".join(self.format(r) for r in self.buffer)
        msg = {"to": self.to, "sender": self.sender,
               "subject": self.subject, "smtp": self.smtp, "body": body}
        if self.mailer is not None:
            self.mailer(msg)
        self.sent.append(msg)
        self.buffer = []
        self.triggered = False

    def close(self) -> None:
        self.flush_email()
        super().close()


def apply_log_settings(block: str, logger: logging.Logger | None = None,
                       mailer=None) -> list[logging.Handler]:
    """Install handlers for a ``log_settings`` block on ``logger``
    (default: the package logger). Returns the installed handlers so
    the caller can flush/close them at job end. An empty or
    root-less block installs the stderr default."""
    logger = logger or logging.getLogger("linz_bde_uploader_spark")
    parsed = parse_log_settings(block or "")
    handlers: list[logging.Handler] = []
    fmt = logging.Formatter("%(asctime)s %(levelname)s> %(message)s")
    if not parsed["root_seen"] or not parsed["appenders"]:
        h: logging.Handler = logging.StreamHandler(sys.stderr)
        h.setFormatter(fmt)
        handlers.append(h)
    else:
        for name, opts in parsed["appenders"].items():
            cls = opts.get("class", "")
            if cls.endswith("Appender::File") and opts.get("filename"):
                mode = "w" if opts.get("mode") == "write" else "a"
                h = logging.FileHandler(opts["filename"], mode=mode)
            elif cls.endswith("Email::MailSender"):
                h = BufferedEmailHandler(
                    min_level=_LEVELS.get(
                        opts.get("min_level", "warning").upper(),
                        logging.WARNING),
                    to=opts.get("to", ""), sender=opts.get("from", ""),
                    subject=opts.get("subject", ""),
                    smtp=opts.get("smtp", ""), mailer=mailer)
            else:  # Screen and anything unrecognized -> stderr
                h = logging.StreamHandler(sys.stderr)
            h.setFormatter(fmt)
            handlers.append(h)
    logger.setLevel(parsed["level"])
    for h in handlers:
        logger.addHandler(h)
    return handlers


def close_log_handlers(logger: logging.Logger,
                       handlers: list[logging.Handler]) -> None:
    """Detach and close (flushing buffered email) at job end."""
    for h in handlers:
        if isinstance(h, BufferedEmailHandler):
            h.flush_email()
        logger.removeHandler(h)
        h.close()
