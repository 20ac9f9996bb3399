"""Engine operators Spark lacks natively, built from DataFrame primitives."""
