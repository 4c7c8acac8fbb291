"""Offline analysis toolchain: output reading, growth rates, dispersion theory,
visualization.  Python-3 re-designs of the reference's tools/ directory."""
