"""Operators (SURVEY.md §2): reference-parity query ops + extensions."""
