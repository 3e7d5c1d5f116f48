"""Dev watch loop (SURVEY §2.1 #26): reference watch.go:18-69
semantics — run-once immediately, re-run per file change, StopWatch
ends the loop, rename/replace (atomic save) still triggers."""

import os
import threading
import time

from flyscrape_spark.devwatch import StopWatch, watch


def test_runs_immediately_and_stops(tmp_path):
    p = tmp_path / "script.py"
    p.write_text("v1")
    seen = []

    def fn(data):
        seen.append(data)
        raise StopWatch

    watch(str(p), fn)
    assert seen == ["v1"]


def test_reruns_on_change_and_rename(tmp_path):
    p = tmp_path / "script.py"
    p.write_text("v1")
    seen = []
    done = threading.Event()

    def fn(data):
        seen.append(data)
        if len(seen) == 3:
            done.set()
            raise StopWatch

    def editor():
        # plain write
        time.sleep(0.15)
        p.write_text("v2")
        os.utime(p)  # ensure mtime moves even on coarse clocks
        # atomic-save rename (watch.go:48-52's Rename case)
        time.sleep(0.15)
        tmp = tmp_path / ".script.py.swp"
        tmp.write_text("v3")
        os.replace(tmp, p)

    t = threading.Thread(target=editor)
    t.start()
    watch(str(p), fn, poll_interval=0.02, max_polls=500)
    t.join()
    assert done.is_set()
    assert seen == ["v1", "v2", "v3"]


def test_max_polls_bounds_the_loop(tmp_path):
    p = tmp_path / "script.py"
    p.write_text("v1")
    seen = []
    watch(str(p), seen.append, poll_interval=0.01, max_polls=3)
    assert seen == ["v1"]
