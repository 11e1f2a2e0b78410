"""Sources: format readers/writers, file listing, and tool-output
normalizers (SURVEY.md §2.1)."""
