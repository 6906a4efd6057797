"""Deterministic synthetic web corpus (FIXTURES.md §2-3): the sealed
stand-in for the network. Everything is a pure function of a seed."""

from .generate import CorpusData, build_corpus

__all__ = ["CorpusData", "build_corpus"]
