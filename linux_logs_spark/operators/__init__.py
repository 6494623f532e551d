"""Operator library — each module registers queries from SURVEY.md §2."""
