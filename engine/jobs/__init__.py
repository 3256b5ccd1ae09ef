"""spark-submit entrypoints (north rule: packaged for --py-files)."""
