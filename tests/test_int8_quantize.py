"""int8 quantization invariants beyond the oracle's bit-parity check."""

from __future__ import annotations

from transit_efficiency_analysis_spark.demo.similarity import q_sim_int8_quantize


def test_codes_span_range_and_error_bounded(spark, sf_dir):
    rows = q_sim_int8_quantize(spark, sf_dir).collect()
    assert len(rows) == 64  # one row per embedding dimension
    for r in rows:
        # calibration guarantees the extremes map to the code endpoints
        assert r.min_code == 0 and r.max_code == 255, r
        # reconstruction error can never exceed one quantization step
        assert r.within_step, r
        step = (r.hi_nano - r.lo_nano) // 255 + 1
        assert r.max_abs_err_nano <= step
        # mean error must be below max error (sanity on the sums)
        assert r.sum_abs_err_nano >= r.max_abs_err_nano
