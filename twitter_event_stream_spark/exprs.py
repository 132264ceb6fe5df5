"""Shared expression helpers enforcing the determinism conventions (C2).

Cross-engine float rounding
---------------------------
Spark's ``round(double, n)`` goes through ``BigDecimal.valueOf`` (shortest
decimal repr, HALF_UP) while DuckDB rounds the binary double — they disagree
whenever the shortest repr ends in a '5' at the rounding digit (measured:
``q_project`` revenue 37704.575 → Spark .58, DuckDB .57). The engine
therefore rounds with a single IEEE formula on both sides::

    rnd(x, n)  =  floor(x * 10^n + 0.505) / 10^n

``floor``/``*``/``+``/``/`` are deterministic IEEE-754 ops, so identical
inputs give bit-identical doubles in both engines, and the ``floor``
collapses cross-engine ulp drift (different summation orders/structures).
The offset is 0.505, not 0.5: the fixture's money-like columns are 2-decimal,
so true scaled aggregates land *exactly* on integers or halves — with +0.5
those sit on the floor boundary and each engine's ulp error decides the
direction (measured: q_win_rows_frame running_avg 54.375 → .37 vs .38).
Shifting the bias 0.005 off the half moves every small-denominator rational
safely outside the drift zone while changing which side of the boundary both
engines round — identically, which is all the hash needs. Negative halves
round toward +inf on both sides — also identical.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(col: Column | str, n: int = 2) -> Column:
    """Portable fixed-point rounding (see module docstring)."""
    if isinstance(col, str):
        col = F.col(col)
    scale = 10**n
    return F.floor(col * scale + F.lit(0.505)) / F.lit(scale)


def R(expr: str, n: int = 2) -> str:
    """The identical rounding formula as DuckDB SQL text, for oracles."""
    scale = 10**n
    return f"floor(({expr}) * {scale} + 0.505) / {scale}"


def char_shingles_sql(n: int = 3, col: str = "text") -> str:
    """SQL text for the distinct character n-gram shingles of ``col`` —
    THE shared shingle builder (near-dup MinHash, n-gram Jaccard,
    winnowing fingerprints, estimator audits all consume it).

    Fast path (r16, guide §1.2 per-task work): the windows are extracted
    with ONE codegen'd regex pass — ``(?s)(?=(.{n}))`` captures the n
    chars after every position via a zero-width lookahead, so the matcher
    emits exactly the overlapping n-grams in position order — instead of
    an interpreted ``transform(sequence(...), i -> substring(...))``
    lambda, which paid per-element interpreter overhead (measured 3.3× on
    the sf0.1 documents: 2.0 s → 0.6 s for the shingle projection).

    Semantics are EXACTLY the old builder's, pinned by a cell-by-cell
    ``<=>`` comparison over the full fixture plus an adversarial battery
    (empty/short/NULL text, newlines/tabs/control chars, accented BMP,
    astral emoji, repeats):

    - The old CASE length-guard (Spark's ``sequence(1, m)`` DESCENDS for
      m < 1 and would fabricate ``''`` shingles on <n-char texts — the r6
      degenerate-text audit catch) is subsumed: the regex simply has no
      match on short texts and yields ``array()``.
    - NULL text: ``regexp_extract_all(NULL)`` is NULL where the old CASE
      produced ``array()`` — the explicit IS NULL arm pins ``array()``.
    - Astral (non-BMP) text falls back to the old transform form: after a
      zero-width match Java's matcher advances by UTF-16 code UNIT, so on
      surrogate pairs the regex would emit extra garbage windows starting
      mid-pair (observed on emoji). The surrogate-range RLIKE routes such
      rows — and only such rows — down the per-code-point path.

    Workload caveat (r17, recording the r16 advisor's note): the routing
    adds one full-text RLIKE scan per row, and a single astral character
    anywhere in a document sends that WHOLE row down the interpreted
    legacy path — an astral-heavy corpus (mostly-emoji, CJK-E blocks)
    sees little of the 3.3× win and pays the extra regex scan. If the
    corpus mix shifts that way, re-measure: splitting rows by the RLIKE
    verdict once and unioning the two paths, or a code-point-safe regex
    over a pre-normalized column, are the candidate shapes.
    """
    legacy = (
        f"CASE WHEN length({col}) >= {n} THEN"
        f" array_distinct(transform(sequence(1, length({col}) - {n - 1}),"
        f" i -> substring({col}, i, {n})))"
        f" ELSE array() END"
    )
    return (
        f"CASE WHEN {col} IS NULL THEN array()"
        f" WHEN {col} RLIKE '[\\\\x{{10000}}-\\\\x{{10FFFF}}]' THEN {legacy}"
        f" ELSE array_distinct(regexp_extract_all({col},"
        f" '(?s)(?=(.{{{n}}}))', 1)) END"
    )
