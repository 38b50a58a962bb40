"""Composed operators the reference/task demands but Spark lacks as
single primitives. Each is a pure DataFrame composition (window / join
/ built-in functions) — no driver-side loops, no row-at-a-time UDFs —
so Catalyst still optimizes through it and it scales with partitions.
"""
