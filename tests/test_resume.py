"""Resume correctness (SURVEY.md §5.2.6, BASELINE.md row 'Resume'):
kill after N slices, re-run, identical final table + completed slices
skipped."""

import pytest

from rdflib_jsonld_spark.operators.expand import expand_transcripts
from rdflib_jsonld_spark.sources.quads_io import (
    ResumableQuadWriter, quad_checksum)
from rdflib_jsonld_spark.sources import transcripts as tr


def test_resume_after_injected_failure(spark, tmp_path):
    df = tr.transcripts_df(spark, n_convs=24, seed=42, partitions=4).cache()
    out = str(tmp_path / "run")

    w = ResumableQuadWriter(spark, out, n_slices=6)
    with pytest.raises(RuntimeError, match="injected failure"):
        w.run(df, expand_transcripts, fail_after=2)
    assert len(w.done_slices()) == 2

    # resume: only remaining slices run; result identical to a clean run
    summary = w.run(df, expand_transcripts)
    assert len(w.done_slices()) == 6
    resumed = w.read_quads()

    clean_dir = str(tmp_path / "clean")
    w2 = ResumableQuadWriter(spark, clean_dir, n_slices=6)
    w2.run(df, expand_transcripts)
    clean = w2.read_quads()

    assert resumed.count() == clean.count() == summary["quads_out"]
    assert quad_checksum(resumed) == quad_checksum(clean)
    # lineage metrics reconcile with the data
    assert summary["rows_in"] == df.count()
    df.unpersist()


def test_error_metrics_in_lineage(spark, tmp_path):
    """expand_with_metrics: malformed fenced blocks are counted into the
    per-slice lineage, and error-sentinel rows never reach the data."""
    from rdflib_jsonld_spark.operators.expand import expand_with_metrics
    # 120 convs at 2% malformed-block rate → near-certain errors
    df = tr.transcripts_df(spark, n_convs=120, seed=42, partitions=4).cache()
    out = str(tmp_path / "run")
    w = ResumableQuadWriter(spark, out, n_slices=3)
    summary = w.run(df, expand_with_metrics)
    assert summary["n_parse_errors"] > 0
    data = w.read_quads()
    assert data.where(data.s == "_:error").count() == 0
    assert "_kg_errors" not in data.columns
    # error counts match the generator's malformed blocks exactly
    import re
    n_bad = 0
    for conv_n in range(120):
        for r in tr.generate_conv(42, conv_n):
            for block in re.findall(r"```ld\n(.*?)\n```", r["text"], re.S):
                import json as _json
                try:
                    _json.loads(block)
                except ValueError:
                    n_bad += 1
    assert summary["n_parse_errors"] == n_bad
    df.unpersist()


def test_rerun_skips_everything(spark, tmp_path):
    df = tr.transcripts_df(spark, n_convs=8, seed=42, partitions=2)
    out = str(tmp_path / "run")
    w = ResumableQuadWriter(spark, out, n_slices=3)
    first = w.run(df, expand_transcripts)
    # second run must be a no-op (markers complete) → same summary
    second = w.run(df, expand_transcripts)
    assert first == second
