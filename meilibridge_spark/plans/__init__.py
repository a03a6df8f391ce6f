"""Build orchestration plans (full, incremental, resumable)."""
