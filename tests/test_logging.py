"""Logger: one run directory at a time — a second Trainer's file handlers
must replace (and close) the first's, not accumulate (accumulation tees every
later line into every earlier run's train.log)."""

import logging
import os

from libcontinual_tpu.utils.logging import Logger


def test_file_handlers_do_not_accumulate(tmp_path):
    d1, d2 = str(tmp_path / "run1"), str(tmp_path / "run2")
    log1 = Logger(d1, name="lct-test-logger")
    log1.info("first run line")
    log2 = Logger(d2, name="lct-test-logger")
    log2.info("second run line")

    shared = logging.getLogger("lct-test-logger")
    fhs = [h for h in shared.handlers if isinstance(h, logging.FileHandler)]
    assert len(fhs) == 1  # not accumulated

    run1 = open(os.path.join(d1, "train.log")).read()
    run2 = open(os.path.join(d2, "train.log")).read()
    assert "first run line" in run1
    assert "second run line" not in run1  # no cross-run contamination
    assert "second run line" in run2
    log2.close()


def test_events_jsonl_is_strict_json(tmp_path):
    """Non-finite metrics (ovr_frgt is inf for 2-task runs) must serialize
    as null, not the non-standard Infinity token."""
    import json

    d = str(tmp_path / "runj")
    log = Logger(d, name="lct-test-logger-json")
    log.event("run_done", ovr_frgt=float("inf"), ovr_bwt=float("-inf"),
              accs=[1.0, float("nan")])
    log.close()
    lines = open(os.path.join(d, "events.jsonl")).read().splitlines()
    rec = json.loads(lines[-1])  # strict parse must succeed
    assert rec["ovr_frgt"] is None and rec["ovr_bwt"] is None
    assert rec["accs"] == [1.0, None]
