"""HTTP serving front-end (OpenAI-compatible) + CLI."""
