"""Derived relational operators (compositions of Spark built-ins)."""
