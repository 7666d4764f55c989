"""End-to-end job assembly: session config, partitioning, lineage, resume."""
