"""Placeholder registry — filled in this round."""

QUERIES = {}
ORACLE = {}
