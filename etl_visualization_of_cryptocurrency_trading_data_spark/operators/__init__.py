"""Operator library: composable DataFrame transforms (SURVEY §2)."""
