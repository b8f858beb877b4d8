"""Sources: wire-frame codec + spool-directory readers (SURVEY.md §2.1)."""
