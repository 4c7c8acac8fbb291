"""Utilities: phase timers, progress logging."""
