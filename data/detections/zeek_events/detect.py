# Analog of ref example/detections/zeek_events/detect.py — the
# match-everything example detection (ref detect.py returns True
# unconditionally).
def detect(event):
    return True
