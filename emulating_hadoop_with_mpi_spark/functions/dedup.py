"""placeholder — filled in below."""
