"""ErrorHandler chain semantics — parity with laygo/errors.py:25-61."""

from __future__ import annotations

import pytest

from laygo_python_spark.errors import ErrorHandler, PipelineAbortError, raise_error


def test_handlers_run_lifo():
    """Most-recently-added runs first (reference laygo/errors.py:47)."""
    order: list[str] = []
    h = ErrorHandler()
    h.on_error(lambda c, e, ctx: order.append("first_added"))
    h.on_error(lambda c, e, ctx: order.append("second_added"))
    h.handle([1], ValueError("x"), {})
    assert order == ["second_added", "first_added"]


def test_on_error_chains_fluently():
    h = ErrorHandler().on_error(lambda c, e, ctx: None).on_error(lambda c, e, ctx: None)
    assert len(h) == 2


def test_raise_error_reraises():
    with pytest.raises(ValueError, match="boom"):
        raise_error([1], ValueError("boom"), {})


def test_handler_receives_chunk_error_context():
    seen = {}

    def capture(chunk, error, context):
        seen.update(chunk=chunk, error=str(error), ctx=context)

    ErrorHandler().on_error(capture).handle([1, 2], RuntimeError("r"), {"k": "v"})
    assert seen == {"chunk": [1, 2], "error": "r", "ctx": {"k": "v"}}


def test_error_handler_with_transformer_catch(spark):
    """ErrorHandler plugs into Transformer.catch as the on_error sink."""
    from laygo_python_spark import Context, Transformer

    ctx = Context(spark=spark)
    ctx.counter("h1")
    ctx.counter("h2")
    h = ErrorHandler()
    h.on_error(lambda c, e, wctx: wctx["h1"].add(1))
    h.on_error(lambda c, e, wctx: wctx["h2"].add(1))

    def bad(pdf):
        raise ValueError("nope")

    t = Transformer().catch(bad, mode="batch", on_error=h)
    df = spark.createDataFrame([(1,)], ["value"]).coalesce(1)
    assert t(df, ctx).count() == 0
    snap = ctx.to_dict()
    assert snap["h1"] == 1 and snap["h2"] == 1


def test_pipeline_abort_error_is_runtime_error():
    assert issubclass(PipelineAbortError, RuntimeError)


def test_quarantine_handler_writes_failed_chunks(spark, tmp_path):
    import pandas as pd

    from laygo_python_spark import Pipeline, Transformer
    from laygo_python_spark.errors import quarantine_handler

    qdir = str(tmp_path / "quarantine")

    def bad(pdf):
        if (pdf.value % 2 == 0).any():
            raise ValueError("even poison")
        return pdf

    t = Transformer().catch(bad, mode="row", on_error=quarantine_handler(qdir))
    result, _ = Pipeline([1, 2, 3, 4, 5], spark=spark).apply(t).to_list()
    assert sorted(result) == [1, 3, 5]
    dead = spark.read.parquet(qdir)
    assert sorted(r["value"] for r in dead.collect()) == [2, 4]
    assert all("even poison" in r["__error"] for r in dead.collect())
