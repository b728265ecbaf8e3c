"""Utilities: dataset files, visualization, profiling, debug modes."""
