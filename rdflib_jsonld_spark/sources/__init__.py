"""Sources & sinks: transcript tables, context registry, quad-table I/O."""
