"""Driver-side planning logic: window arithmetic, progress/commit rules,
and the relational state-scan building blocks (SURVEY.md §2 Q2-Q5, S2, A2,
K2-read)."""
