"""Sources: corpus readers, synthetic page generation, HTML/PDF codecs."""
