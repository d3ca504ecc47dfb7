# Root-account usage, excluding AWS-internal service events
# (analog of ref example/detections/aws_root_credentials/detect.py).


def detect(event):
    if event.deepget("aws.cloudtrail.user_identity.type") != "Root":
        return False
    return event.deepget("aws.cloudtrail.event_type") != "AwsServiceEvent"


def title(event):
    return f"AWS root account used: {event.deepget('event.action')}"
