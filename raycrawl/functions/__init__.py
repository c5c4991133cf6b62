"""Pure, stateless scalar/batch functions (canonicalization, extraction)."""
