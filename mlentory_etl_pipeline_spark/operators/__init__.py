"""Operator library — each module documents the SURVEY §2 ops it covers."""
