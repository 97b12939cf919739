"""Engine operators (SURVEY.md §2 inventory + §M6 extensions)."""
