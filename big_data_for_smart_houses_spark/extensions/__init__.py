"""LLM-data-pipeline extension operators (SURVEY.md §7.4): dedup,
similarity search, text analysis, multimodal columns — each designed
partition-parallel with no driver-side collects so the same code runs
at 100 TB."""
