"""nuts subpackage."""
