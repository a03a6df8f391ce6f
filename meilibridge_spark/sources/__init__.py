"""Sources: synthetic transcripts generator, table IO + snapshots, CDC."""
