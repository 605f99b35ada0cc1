"""Column-expression libraries: fiscal calendar, cleaning parity, metrics,
text analysis, vector math. All pure ``Column -> Column`` functions — no UDFs
in any hot path, so everything stays inside whole-stage codegen."""
