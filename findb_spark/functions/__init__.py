"""Scalar/array function library shared across operators."""
