"""Operator library: finance time-series, events/sessionization, text,
dedup, and vector-similarity operators built on DataFrame combinators."""
