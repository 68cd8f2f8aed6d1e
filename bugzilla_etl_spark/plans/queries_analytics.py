"""Placeholder — filled in as SURVEY §2 coverage widens."""
