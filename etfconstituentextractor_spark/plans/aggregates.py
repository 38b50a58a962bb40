"""Placeholder — queries land in a later phase of round 1."""
