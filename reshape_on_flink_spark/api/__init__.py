"""Fluent API facades mirroring the reference's programming surfaces."""
