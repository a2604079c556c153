"""Engine operators that compose Spark built-ins into higher-level semantics."""
