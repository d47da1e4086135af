"""Plan-level contracts: streams/catalog/state, chunk planning, filters."""
