"""Command-line tool: transform / untransform / debug-* commands."""
