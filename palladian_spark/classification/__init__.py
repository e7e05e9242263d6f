"""Dictionary text classifier (the PalladianTextClassifier equivalent)."""
