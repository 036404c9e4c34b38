"""Local assembly / gap bridging — the flagship feature (SURVEY.md §2.11)."""
