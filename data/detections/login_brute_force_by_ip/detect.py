# Cross-source failed-authentication detector, deduped per source IP so
# the state machine counts attempts per attacker (analog of ref
# example/detections/login_brute_force_by_ip/detect.py).


def detect(r):
    if "authentication" not in (r.deepget("event.category") or []):
        return False
    return r.deepget("event.outcome") == "failure"


def title(r):
    return (
        f"Multiple failed logins for {r.deepget('user.name')} "
        f"from {r.deepget('source.ip')}"
    )


def dedupe(r):
    return r.deepget("source.ip")
