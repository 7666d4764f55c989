"""Pure column-level functions (oracle-checkable scalar operators)."""
