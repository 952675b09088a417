"""Dataflow operators of the dedup pipeline (DataFrame -> DataFrame, pure)."""
