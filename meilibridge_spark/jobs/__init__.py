"""spark-submit entry points (north_rule: ships as --py-files jobs)."""
