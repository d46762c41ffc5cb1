"""Sokoban task registration (placeholder until the env lands)."""
