"""Custom operators — the pieces Spark lacks but the reference has.

Everything here is a *composition of built-in DataFrame ops* (preference
(a) of the build rules); no Python row loops, no RDDs. Each module
documents the reference operator it reproduces and its 100 TB plan shape.
"""
