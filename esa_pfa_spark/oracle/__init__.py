"""Single-process pandas/numpy oracle implementations (SURVEY.md §5)."""
