"""multimodal queries — filled in incrementally (SURVEY.md §2)."""
