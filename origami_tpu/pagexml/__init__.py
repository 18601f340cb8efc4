"""PAGE 2019 XML writing + transcription ground-truth reading."""
