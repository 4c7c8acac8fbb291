"""Core simulation machinery: state, loading, time stepping, diagnostics."""
