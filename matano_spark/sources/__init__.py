"""Source readers and routing (SURVEY.md §2.1 S1-S9)."""
