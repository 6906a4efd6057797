"""Core: Arrow schemas and shared row constructors."""
