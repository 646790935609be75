"""Single-file and sharded sinks for genomics formats."""
