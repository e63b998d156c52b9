"""Streaming declared queries (SURVEY.md §2.2 Q-T*). Populated next."""
