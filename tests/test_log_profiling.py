import json
import time

from como_tpu.utils.log import EventLog
from como_tpu.utils.profiling import StageTimer


def test_event_log(tmp_path):
    p = str(tmp_path / "events.jsonl")
    log = EventLog(p)
    log.emit("frame", idx=1)
    log.emit("insert", frame_kind="keyframe")
    log.emit("frame", idx=2)
    log.flush()
    lines = [json.loads(l) for l in open(p)]
    assert [e["kind"] for e in lines] == ["frame", "insert", "frame"]
    assert log.counts() == {"frame": 2, "insert": 1}
    log.close()


def test_stage_timer():
    t = StageTimer(ema=0.5)
    for _ in range(3):
        with t.stage("work"):
            time.sleep(0.01)
    assert 0.005 < t.avg["work"] < 0.1
    assert t.count["work"] == 3
    assert "work=" in t.report()
