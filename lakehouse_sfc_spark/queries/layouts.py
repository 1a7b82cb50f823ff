"""Layout-invariance queries (SFC write + pruned scan == full scan) — filled
in once the layout writer and pruner land."""
