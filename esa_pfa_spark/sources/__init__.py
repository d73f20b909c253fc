"""Sources and sinks: lakehouse tables, sink registry, dated layouts."""
