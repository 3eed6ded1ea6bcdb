"""Profiling instrumentation: the throughput meter must exclude the
first (compiling) step from its window, and the trace context must be a
no-op without a profile dir."""

import time

from manipose_tpu.train.profiling import ThroughputMeter, trace


class TestThroughputMeter:
    def test_excludes_first_compiling_step(self):
        meter = ThroughputMeter()
        meter.step(16)              # first call: the step that compiles
        time.sleep(0.05)            # "compile time" — must not be timed
        meter.step(16)              # clock starts here
        time.sleep(0.01)
        meter.step(16)
        time.sleep(0.01)
        # 2 timed steps over ~0.02s of window — if the 0.05s compile
        # were included, throughput would read < 700 seq/s
        assert meter.seq_per_sec > 1000, meter.seq_per_sec
        assert 5 < meter.ms_per_step < 25, meter.ms_per_step

    def test_zero_before_any_timed_step(self):
        meter = ThroughputMeter()
        assert meter.seq_per_sec == 0.0 and meter.ms_per_step == 0.0
        meter.step(4)
        assert meter.seq_per_sec == 0.0  # only the compile step so far

    def test_reset(self):
        meter = ThroughputMeter()
        for _ in range(3):
            meter.step(8)
        meter.reset()
        assert meter.seq_per_sec == 0.0


def test_trace_noop_without_dir(tmp_path):
    with trace(""):
        pass  # must not start the profiler
    with trace(None):
        pass
