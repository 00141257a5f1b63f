"""Per-partition graph state: CSR adjacency, vertex programs, partition actor."""
