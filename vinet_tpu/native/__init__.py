"""Native (C++) components."""
