"""Sources: synthetic corpus generation and table IO."""
