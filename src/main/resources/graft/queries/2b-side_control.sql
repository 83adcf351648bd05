-- Stage-2 side input: per-user control argmax (last signup value by
-- (ts, event_id)). Loop-invariant — hoisted before the iteration loop and
-- cached; see 2a-side_activity.sql header.
select
    user_id,
    (max(named_struct('o0', ts, 'o1', event_id, 'v', value))).v as last_signup_value
from {cdc_view}
where event_type = 'signup'
group by user_id
