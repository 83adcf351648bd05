-- Stage 2: activity filter + control argmax + counter joins (reference
-- 2-basedata_df_query.sql semantics: separate statistic families, each
-- joined onto the base — the DataFrame pipeline fuses these into one
-- conditional aggregation; the SQL path keeps the reference's join layout).
-- The four side inputs are loop-INVARIANT, so they live in their own
-- templates (2a–2d), run once before the iteration loop, and arrive here as
-- cached views — the reference recomputes all four scans per iteration.
-- Inline subqueries instead of WITH — see 0-merge_delete.sql header.
select
    b.*,
    ctl.last_signup_value,
    cast(coalesce(ck.n_clicks, 0) as bigint) as n_clicks,
    coalesce(ck.click_value, 0) as click_value,
    cast(coalesce(vw.n_views, 0) as bigint) as n_views
from {base1_view} b
inner join {activity_view} a on b.user_id = a.user_id
left join {control_view} ctl on b.user_id = ctl.user_id
left join {clicks_view} ck on b.user_id = ck.user_id
left join {views_view} vw on b.user_id = vw.user_id
