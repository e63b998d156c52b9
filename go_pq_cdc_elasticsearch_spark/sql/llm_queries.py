"""LLM-pipeline declared queries (SURVEY.md §2.2 Q-L*). Populated next."""
