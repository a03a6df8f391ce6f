"""Structured Streaming maintenance (CDC realtime sync, S21)."""
