"""Sokoban env family (flagship of the fork) — filled in by env.py."""
