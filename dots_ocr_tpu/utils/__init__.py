"""Host-side utilities: resolution policy, prompts, bbox math, markdown, repair."""
