"""Dev watch loop (SURVEY §2.1 #26).

The reference's ``flyscrape dev`` mode re-runs the scrape script on
every file write/rename (/root/reference/watch.go:18-69, fsnotify);
the callback returning ``StopWatch`` ends the loop. This engine
mirrors the semantics with stdlib mtime polling (no fsnotify in the
container, and the Spark driver is the only process that needs the
signal): run once immediately, then re-run whenever the file's
(mtime_ns, size) identity changes; a rename/replace (editor
atomic-save) is just a new identity, matching watch.go:48-52's
re-add. Raising :class:`StopWatch` from the callback stops the loop
(watch.go:16, 37-39, 53-56).

This is driver-side tooling — the callback typically rebuilds the
script UDF and re-launches a (small) crawl; nothing here touches the
distributed plan.
"""

from __future__ import annotations

import os
import time


class StopWatch(Exception):
    """Raise from the callback to end the watch loop (watch.go:16)."""


def _identity(path: str):
    try:
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except FileNotFoundError:
        # mid-rename window (watch.go:48-50 sleeps and re-adds);
        # treated as "unchanged" until the new file lands
        return None


def watch(path: str, fn, poll_interval: float = 0.05,
          max_polls: int | None = None) -> None:
    """Call ``fn(contents)`` now and again after every change of
    ``path`` until ``fn`` raises :class:`StopWatch` (or ``max_polls``
    polls elapse — tests/timeouts; None = forever, the reference CLI
    behavior)."""

    def run() -> bool:
        with open(path, encoding="utf-8") as f:
            data = f.read()
        try:
            fn(data)
            return True
        except StopWatch:
            return False

    last = _identity(path)
    if not run():
        return
    polls = 0
    while max_polls is None or polls < max_polls:
        polls += 1
        time.sleep(poll_interval)
        now = _identity(path)
        if now is not None and now != last:
            last = now
            if not run():
                return
