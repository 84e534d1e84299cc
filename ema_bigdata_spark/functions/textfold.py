"""Cross-engine (Spark ↔ DuckDB) text-folding parity helpers (r9).

The r9 hostile-unicode sweep (tools/hostile_sweep.py, ROUND9_NOTES)
found the two places the engines' TEXT builtins legitimately disagree,
and this module pins the engine's declared semantics for both:

1. **lower()** — Spark folds with ICU FULL case mapping, DuckDB with
   utf8proc SIMPLE mapping.  A 20-probe battery over the Unicode
   SpecialCasing classes found exactly two divergent lowercase
   classes (everything else agreed, including ß, ligatures, and
   titlecase digraphs, whose divergences are upper()-only):

   - U+0130 İ (LATIN CAPITAL LETTER I WITH DOT ABOVE): full mapping
     emits "i" + U+0307 (two code points), simple mapping emits "i";
   - U+03A3 Σ: Spark applies the contextual final-sigma rule
     (word-final Σ → ς), DuckDB maps Σ → σ unconditionally.

   :func:`fold_lower` pre-maps BOTH classes to their simple,
   context-free forms (İ → i, Σ → σ) before lower() on BOTH engines —
   the fold used for dedup keys and search anyway (final-sigma-free σ
   is the standard Greek fold).  Declared semantics: case folding is
   SIMPLE and context-free.  Identity on text without those two code
   points, hence on all driver data.

2. **levenshtein()** — Spark counts CODE-POINT edits, DuckDB counts
   BYTE edits (probed: é↔e = 1 vs 2, 中↔a = 1 vs 3).  The declared
   unit is UTF-8 BYTES: locale-free, alignment-free, and the unit
   both engines can compute exactly — :func:`lev_bytes` maps Spark's
   input through ``decode(encode(s, 'UTF-8'), 'ISO-8859-1')``, which
   turns each UTF-8 byte into one Latin-1 code point (a lossless 1:1
   byte↔char map), making Spark's code-point distance equal the byte
   distance.  Normalizers that divide by a length must use
   OCTET_LENGTH/STRLEN, not length().  Identity on ASCII text, hence
   on all driver data.

Pinned by tests/test_properties.py::TestTextFoldParity and the
hostile-unicode sweep mode (151/151 clean).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


#: the two divergent lowercase classes (see module docstring) and
#: their declared simple, context-free folds
_FOLD_PRE = (("İ", "i"), ("Σ", "σ"))


def fold_lower(col: str | Column) -> Column:
    """Simple context-free lowercase, identical on both engines."""
    c = _col(col)
    for src, dst in _FOLD_PRE:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return F.lower(c)


def sql_fold_lower(expr: str) -> str:
    """Oracle text matching :func:`fold_lower`."""
    c = expr
    for src, dst in _FOLD_PRE:
        c = f"replace({c}, '{src}', '{dst}')"
    return f"lower({c})"


def lev_bytes(a: Column, b: Column) -> Column:
    """Levenshtein distance in UTF-8 BYTES (module docstring)."""

    def latin1(c: Column) -> Column:
        return F.decode(F.encode(c, "UTF-8"), "ISO-8859-1")

    return F.levenshtein(latin1(a), latin1(b))


def sql_lev_bytes(a: str, b: str) -> str:
    """Oracle text matching :func:`lev_bytes` (DuckDB's levenshtein is
    already byte-based — probed)."""
    return f"levenshtein({a}, {b})"
