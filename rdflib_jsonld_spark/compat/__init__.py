"""Compatibility shims for users migrating from the reference package."""
