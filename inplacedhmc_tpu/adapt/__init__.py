"""adapt subpackage."""
