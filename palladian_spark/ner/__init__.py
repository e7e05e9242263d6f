"""PalladianNer-equivalent named-entity recognition."""
