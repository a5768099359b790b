"""trace_summary CLI: parses a Chrome-format profiler trace."""

import gzip
import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


def _write_trace(root: Path):
    events = [
        {"ph": "M", "pid": 3, "name": "process_name", "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 7, "name": "process_name", "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 3, "tid": 1, "name": "jit_run(1)", "dur": 1000, "ts": 0,
         "args": {}},
        {"ph": "X", "pid": 3, "tid": 1, "name": "fusion.1", "dur": 700, "ts": 0,
         "args": {"hlo_category": "loop fusion", "bytes_accessed": "7000",
                  "long_name": "%fusion.1 = f32[8,196,263]{2,0,1} fusion(...)"}},
        {"ph": "X", "pid": 3, "tid": 1, "name": "convolution.2", "dur": 300, "ts": 700,
         "args": {"hlo_category": "convolution", "bytes_accessed": "1000"}},
        {"ph": "X", "pid": 7, "tid": 1, "name": "host_stuff", "dur": 9999, "ts": 0,
         "args": {}},
    ]
    d = root / "plugins/profile/2026_01_01_00_00_00"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)


class TestTraceSummary:
    def test_summarize_categories_and_ops(self, tmp_path, capsys):
        import trace_summary

        _write_trace(tmp_path)
        assert trace_summary.main([str(tmp_path)]) == 0
        out = capsys.readouterr().out
        # jit_ wrapper excluded; host timeline excluded
        assert "device time (sum of leaf ops): 1.000 ms" in out
        assert "loop fusion" in out and "convolution" in out
        assert "f32[8,196,263]" in out
        assert "host_stuff" not in out

    def test_missing_trace_raises(self, tmp_path):
        import trace_summary

        with pytest.raises(FileNotFoundError):
            trace_summary.main([str(tmp_path / "nope")])
