"""Deterministic fixture generators (corpus, gazetteer).

Everything here is seeded — no wall-clock, no randomness outside a
fixed-seed PRNG — so golden outputs are stable across runs and machines.
"""
