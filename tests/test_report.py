"""Reporter tests (reporting.jl parity: throttling, steps/sec, JSON lines)."""

import io
import json

from inplacedhmc_tpu.report import (JsonLinesReport, LogProgressReport,
                                    NoProgressReport, default_reporter)


def test_log_progress_report_format_and_throttle():
    buf = io.StringIO()
    r = LogProgressReport(time_interval_s=0.0, stream=buf)
    r.start_stage("tuning 100 steps", 100)
    r.step(10, eps=0.123)
    r.end_stage(eps=0.456)
    out = buf.getvalue()
    assert "tuning 100 steps" in out
    assert "10/100" in out and "steps/s" in out and "ETA" in out
    assert "done in" in out

    # throttled: a huge interval suppresses intermediate lines
    buf2 = io.StringIO()
    r2 = LogProgressReport(time_interval_s=1e6, stream=buf2)
    r2.start_stage("s", 10)
    r2.step(5)
    assert "5/10" not in buf2.getvalue()


def test_json_lines_report_is_machine_readable():
    buf = io.StringIO()
    r = JsonLinesReport(stream=buf)
    r.start_stage("warmup", 50)
    r.step(25, eps=0.1)
    r.end_stage(eps=0.2)
    events = [json.loads(line) for line in buf.getvalue().splitlines()]
    assert [e["event"] for e in events] == ["stage_start", "progress", "stage_end"]
    assert events[1]["done"] == 25
    assert events[2]["wall_s"] >= 0


def test_default_reporter_modes():
    assert isinstance(default_reporter(interactive=False), NoProgressReport)
    assert isinstance(default_reporter(interactive=True), LogProgressReport)


def test_reporter_threads_through_sampler():
    import jax
    import jax.numpy as jnp
    from inplacedhmc_tpu.models import std_normal
    from inplacedhmc_tpu.sample import mcmc_with_warmup
    from inplacedhmc_tpu.config import default_warmup_stages

    buf = io.StringIO()
    r = LogProgressReport(time_interval_s=0.0, stream=buf)
    mcmc_with_warmup(jax.random.PRNGKey(0), std_normal(3), n_draws=20,
                     n_chains=2, dtype=jnp.float64, reporter=r,
                     warmup_stages=default_warmup_stages(
                         init_steps=5, middle_steps=5, doubling_stages=1,
                         terminating_steps=5))
    out = buf.getvalue()
    assert "find local optimum" in out
    assert "initial stepsize search" in out
    assert "sampling 20 draws" in out
