"""Numeric factorization (reference: sopalin — SURVEY.md §2 rows 9-11)."""

from pastix_tpu.numeric.factorize import (
    Factors,
    build_factorize_fn,
    coefinit,
    factorize,
)

__all__ = ["Factors", "build_factorize_fn", "coefinit", "factorize"]
