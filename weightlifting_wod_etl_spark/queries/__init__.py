"""Named query declarations, grouped by operator family."""
