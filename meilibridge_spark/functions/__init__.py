"""Pure, Spark-free algorithm kernels (unit-testable without a session)."""
