"""Source builders — batch readers and streaming readStream factories."""
