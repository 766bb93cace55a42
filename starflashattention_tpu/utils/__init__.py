"""Utilities: native-runtime bindings, profiling helpers."""
