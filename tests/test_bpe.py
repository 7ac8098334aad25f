"""Regression tests for caller-supplied merge-list validation in BPE."""

from __future__ import annotations

import pytest


def test_apply_merges_rejects_symbols_containing_separator(spark):
    """ADVICE r4: apply_merges keys pair matches on concat(pend, NUL, s);
    a caller-supplied symbol containing NUL (a='x', b='\\x00y' colliding
    with the key of pair ('x\\x00', 'y')) would alias another pair's key
    and silently merge the wrong symbols. The guard raises instead."""
    from meds_polars_functions_spark.operators.bpe import (
        apply_merges,
        init_symbol_table,
        word_freq_table,
    )

    tab = init_symbol_table(
        word_freq_table(spark.createDataFrame([("ab ab",)], ["text"]), "text")
    )
    with pytest.raises(ValueError, match="reserved separator"):
        apply_merges(tab, [("x", "\x00y")])
    with pytest.raises(ValueError, match="reserved separator"):
        apply_merges(tab, [("x\x00", "y")])
    # NUL-free merges still work unchanged
    out = apply_merges(tab, [("a", "b")])
    assert out.select("syms").first()[0] == ["ab"]
